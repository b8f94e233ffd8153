"""Headless tkinter substitute for exercising the real Tk widget classes.

This image ships no X server (no Xvfb/Xephyr binaries, installs forbidden),
so ``tkinter.Tk()`` cannot ever succeed in CI.  The next-best coverage is a
faithful *recording* implementation of the tkinter API surface the app uses:
installed into ``sys.modules`` **before** the UI modules are imported, it
becomes the base class of every widget, so every widget ``__init__``, every
callback wiring, every ``after()`` poll loop and every matplotlib draw runs
for real — only the Tcl/X round-trips are absent.  Matplotlib canvases render
through the actual Agg backend (``FigureCanvasTkAgg`` here subclasses
``FigureCanvasAgg`` and ``draw_idle`` rasterizes immediately), so figure-level
errors are caught too.

What this cannot catch: Tk option-name typos rejected by Tcl at widget
creation, geometry/layout problems, and event-loop timing.  Those need a
display; see tests/test_ui.py's display-gated smoke test.

Usage::

    with tkstub.installed():
        ui = tkstub.fresh_ui_modules()   # re-imports qpsim_tpu.ui.* over the stub
        app = ui["main_app"].QuasiparticleMainApp()
        tkstub.find_button(app, "Quit").invoke()
"""

from __future__ import annotations

import contextlib
import importlib
import sys
import threading
import types
from typing import Any, Callable

END = "end"


class TclError(Exception):
    pass


# --------------------------------------------------------------------------
# scheduler shared by all widgets (after / after_cancel / pump)
# --------------------------------------------------------------------------


class _Scheduler:
    def __init__(self):
        self._lock = threading.Lock()
        self._seq = 0
        self._queue: list[tuple[str, Callable]] = []

    def after(self, _delay_ms, callback=None, *args):
        if callback is None:
            return "after#none"
        with self._lock:
            self._seq += 1
            token = f"after#{self._seq}"
            self._queue.append((token, lambda: callback(*args)))
        return token

    def after_cancel(self, token):
        with self._lock:
            self._queue = [(t, c) for (t, c) in self._queue if t != token]

    def pump(self, rounds: int = 1) -> int:
        """Run the callbacks queued *now*; repeat ``rounds`` times.

        Re-registered callbacks (poll loops) land in the next round.
        Returns the number of callbacks executed.
        """
        ran = 0
        for _ in range(rounds):
            with self._lock:
                batch, self._queue = self._queue, []
            for _token, cb in batch:
                cb()
                ran += 1
        return ran


_scheduler = _Scheduler()
_modal_handlers: list[Callable[["Toplevel"], None]] = []


def pump(rounds: int = 1) -> int:
    """Execute pending after()-callbacks (the stub's event loop)."""
    return _scheduler.pump(rounds)


def on_next_modal(handler: Callable[["Toplevel"], None]) -> None:
    """Queue a handler invoked with the dialog window at its wait_window().

    Emulates the user interacting with a modal dialog: the handler runs at
    the point the calling code blocks on ``parent.wait_window(win)``.
    """
    _modal_handlers.append(handler)


# --------------------------------------------------------------------------
# variables
# --------------------------------------------------------------------------


class Variable:
    _default: Any = ""

    def __init__(self, master=None, value=None, name=None):
        self._value = self._default if value is None else value
        self._traces: list[tuple[str, Callable]] = []

    def get(self):
        return self._value

    def set(self, value):
        self._value = self._coerce(value)
        for _mode, cb in self._traces:
            cb()

    def _coerce(self, value):
        return value

    def trace_add(self, mode, callback):
        self._traces.append((mode, lambda: callback(None, None, mode)))
        return f"trace#{len(self._traces)}"

    def trace_remove(self, mode, name):
        pass


class StringVar(Variable):
    _default = ""

    def _coerce(self, value):
        return str(value)


class BooleanVar(Variable):
    _default = False

    def _coerce(self, value):
        return bool(value)


class IntVar(Variable):
    _default = 0

    def _coerce(self, value):
        return int(value)


class DoubleVar(Variable):
    _default = 0.0

    def _coerce(self, value):
        return float(value)


# --------------------------------------------------------------------------
# widgets
# --------------------------------------------------------------------------


class Misc:
    pass


class Widget(Misc):
    def __init__(self, master=None, cnf=None, **kw):
        self.master = master
        self.children_: list[Widget] = []
        self.options: dict[str, Any] = dict(cnf or {})
        self.options.update(kw)
        self.bindings: dict[str, list[Callable]] = {}
        self.protocols: dict[str, Callable] = {}
        self._destroyed = False
        self._title = ""
        if master is not None and hasattr(master, "children_"):
            master.children_.append(self)

    # geometry managers — layout is display work; recording only
    def pack(self, *a, **kw):
        return self

    def grid(self, *a, **kw):
        return self

    def place(self, *a, **kw):
        return self

    def pack_propagate(self, *a, **kw):
        pass

    def grid_propagate(self, *a, **kw):
        pass

    def rowconfigure(self, *a, **kw):
        pass

    def columnconfigure(self, *a, **kw):
        pass

    grid_rowconfigure = rowconfigure
    grid_columnconfigure = columnconfigure

    # options
    def configure(self, cnf=None, **kw):
        self.options.update(cnf or {})
        self.options.update(kw)

    config = configure

    def cget(self, key):
        return self.options.get(key)

    __getitem__ = cget

    def __setitem__(self, key, value):
        self.options[key] = value

    # events / callbacks
    def bind(self, sequence, func=None, add=None):
        self.bindings.setdefault(sequence, []).append(func)
        return f"bind#{sequence}"

    def unbind(self, sequence, funcid=None):
        self.bindings.pop(sequence, None)

    def fire_event(self, sequence, event=None) -> int:
        """Test helper: invoke the handlers bound to ``sequence``."""
        handlers = list(self.bindings.get(sequence, ()))
        for h in handlers:
            h(event if event is not None else types.SimpleNamespace(widget=self))
        return len(handlers)

    def event_generate(self, sequence, **kw):
        self.fire_event(sequence)

    def protocol(self, name, func=None):
        if func is not None:
            self.protocols[name] = func

    def after(self, delay_ms, callback=None, *args):
        return _scheduler.after(delay_ms, callback, *args)

    def after_cancel(self, token):
        _scheduler.after_cancel(token)

    def after_idle(self, callback, *args):
        return _scheduler.after(0, callback, *args)

    # window-ish methods (valid on Toplevel/Tk; harmless elsewhere)
    def title(self, text=None):
        if text is not None:
            self._title = text
        return self._title

    def geometry(self, spec=None):
        return spec

    def transient(self, other=None):
        pass

    def resizable(self, *a, **kw):
        pass

    def minsize(self, *a, **kw):
        pass

    def grab_set(self):
        pass

    def grab_release(self):
        pass

    def focus_set(self):
        pass

    focus = focus_set

    def lift(self, *a):
        pass

    def iconify(self):
        pass

    def deiconify(self):
        pass

    def withdraw(self):
        pass

    def option_add(self, pattern, value, priority=None):
        pass

    def update(self):
        pass

    def update_idletasks(self):
        pass

    def wait_window(self, window=None):
        # the point a modal dialog blocks: run the queued test interaction
        target = window if window is not None else self
        if _modal_handlers:
            _modal_handlers.pop(0)(target)

    def wait_visibility(self, window=None):
        pass

    def mainloop(self, n=0):
        pump(rounds=2)

    def quit(self):
        pass

    # lifecycle / introspection
    def destroy(self):
        if self._destroyed:
            return
        self._destroyed = True
        for child in list(self.children_):
            child.destroy()
        if self.master is not None and hasattr(self.master, "children_"):
            with contextlib.suppress(ValueError):
                self.master.children_.remove(self)
        for cb in self.protocols.values():
            pass  # WM_DELETE_WINDOW is user-initiated; not fired on destroy()

    def winfo_exists(self):
        return not self._destroyed

    def winfo_children(self):
        return list(self.children_)

    def winfo_toplevel(self):
        w = self
        while w.master is not None and not isinstance(w, (Tk, Toplevel)):
            w = w.master
        return w

    def winfo_width(self):
        return 800

    def winfo_height(self):
        return 600

    def winfo_rootx(self):
        return 0

    def winfo_rooty(self):
        return 0

    def winfo_screenwidth(self):
        return 1920

    def winfo_screenheight(self):
        return 1080


class Tk(Widget):
    def __init__(self, *a, **kw):
        super().__init__(master=None, **kw)


class Toplevel(Widget):
    pass


class Frame(Widget):
    pass


class LabelFrame(Widget):
    pass


class Label(Widget):
    pass


class Button(Widget):
    def invoke(self):
        cmd = self.options.get("command")
        if cmd is not None and self.options.get("state") != "disabled":
            return cmd()


class Checkbutton(Widget):
    def invoke(self):
        var = self.options.get("variable")
        if var is not None:
            var.set(not var.get())
        cmd = self.options.get("command")
        if cmd is not None:
            return cmd()

    def select(self):
        var = self.options.get("variable")
        if var is not None:
            var.set(True)

    def deselect(self):
        var = self.options.get("variable")
        if var is not None:
            var.set(False)


class Radiobutton(Checkbutton):
    def invoke(self):
        var = self.options.get("variable")
        if var is not None:
            var.set(self.options.get("value"))
        cmd = self.options.get("command")
        if cmd is not None:
            return cmd()


class Entry(Widget):
    def __init__(self, master=None, cnf=None, **kw):
        super().__init__(master, cnf, **kw)
        self._content = ""

    def _var(self):
        return self.options.get("textvariable")

    def get(self):
        var = self._var()
        return var.get() if var is not None else self._content

    def insert(self, index, string):
        cur = self.get()
        pos = len(cur) if index in (END, "insert") else int(index)
        new = cur[:pos] + str(string) + cur[pos:]
        var = self._var()
        if var is not None:
            var.set(new)
        else:
            self._content = new

    def delete(self, first, last=None):
        cur = self.get()
        a = 0 if first == 0 or first == "0" else (len(cur) if first == END else int(first))
        b = len(cur) if last in (END, None) else int(last)
        new = cur[:a] + cur[b:]
        var = self._var()
        if var is not None:
            var.set(new)
        else:
            self._content = new

    def icursor(self, index):
        pass

    def selection_range(self, start, end):
        pass


class Spinbox(Entry):
    pass


class Text(Widget):
    def __init__(self, master=None, cnf=None, **kw):
        super().__init__(master, cnf, **kw)
        self._content = ""

    def insert(self, index, string, *tags):
        self._content += str(string)

    def delete(self, first, last=None):
        self._content = ""

    def get(self, first="1.0", last=END):
        return self._content

    def see(self, index):
        pass

    def tag_configure(self, *a, **kw):
        pass


class Listbox(Widget):
    def __init__(self, master=None, cnf=None, **kw):
        super().__init__(master, cnf, **kw)
        self._items: list[str] = []
        self._selection: tuple[int, ...] = ()

    def insert(self, index, *items):
        pos = len(self._items) if index == END else int(index)
        self._items[pos:pos] = [str(i) for i in items]

    def delete(self, first, last=None):
        if first == 0 and last == END:
            self._items = []
        else:
            a = int(first)
            b = a + 1 if last is None else (len(self._items) if last == END else int(last) + 1)
            del self._items[a:b]
        self._selection = ()

    def get(self, index, last=None):
        if last is not None:
            return tuple(self._items)
        return self._items[int(index)]

    def size(self):
        return len(self._items)

    def curselection(self):
        return self._selection

    def selection_set(self, first, last=None):
        self._selection = tuple(sorted(set(self._selection) | {int(first)}))

    select_set = selection_set

    def selection_clear(self, first=0, last=END):
        self._selection = ()

    select_clear = selection_clear

    def see(self, index):
        pass

    def activate(self, index):
        pass


class Scale(Widget):
    def __init__(self, master=None, cnf=None, **kw):
        super().__init__(master, cnf, **kw)
        self._value = float(kw.get("from_", 0))

    def set(self, value):
        self._value = float(value)
        cmd = self.options.get("command")
        if cmd is not None:
            cmd(str(self._value))  # Tk passes the value as a string

    def get(self):
        return self._value


class Canvas(Widget):
    def create_line(self, *a, **kw):
        return 1

    def create_rectangle(self, *a, **kw):
        return 1

    def create_text(self, *a, **kw):
        return 1

    def delete(self, *a):
        pass


class Scrollbar(Widget):
    def set(self, *a):
        pass


class Menu(Widget):
    def add_command(self, *a, **kw):
        pass

    def add_separator(self, *a, **kw):
        pass

    def post(self, *a):
        pass


class PhotoImage:
    def __init__(self, *a, **kw):
        pass


# --------------------------------------------------------------------------
# ttk
# --------------------------------------------------------------------------


class Combobox(Entry):
    def __init__(self, master=None, cnf=None, **kw):
        super().__init__(master, cnf, **kw)

    def current(self, index=None):
        values = list(self.options.get("values", ()))
        if index is None:
            try:
                return values.index(self.get())
            except ValueError:
                return -1
        self.set(values[index])

    def set(self, value):
        var = self._var()
        if var is not None:
            var.set(value)
        else:
            self._content = str(value)


class Treeview(Widget):
    def __init__(self, master=None, cnf=None, **kw):
        super().__init__(master, cnf, **kw)
        self._items: dict[str, dict] = {}
        self._order: list[str] = []
        self._selection: tuple[str, ...] = ()
        self._seq = 0

    def heading(self, column, **kw):
        pass

    def column(self, column, **kw):
        pass

    def insert(self, parent, index, iid=None, **kw):
        self._seq += 1
        iid = iid or f"I{self._seq:03d}"
        self._items[iid] = dict(kw)
        self._order.append(iid)
        return iid

    def delete(self, *iids):
        for iid in iids:
            self._items.pop(iid, None)
            with contextlib.suppress(ValueError):
                self._order.remove(iid)

    def get_children(self, item=None):
        return tuple(self._order)

    def item(self, iid, option=None, **kw):
        data = self._items[iid]
        if option is not None:
            return data.get(option)
        if kw:
            data.update(kw)
        return data

    def selection(self):
        return self._selection

    def selection_set(self, *iids):
        self._selection = tuple(iids)
        self.fire_event("<<TreeviewSelect>>")


class Notebook(Widget):
    def __init__(self, master=None, cnf=None, **kw):
        super().__init__(master, cnf, **kw)
        self._tabs: list[tuple[Widget, dict]] = []

    def add(self, child, **kw):
        self._tabs.append((child, kw))

    def tabs(self):
        return [t for t, _ in self._tabs]

    def select(self, tab_id=None):
        return self._tabs[0][0] if self._tabs else None


class Progressbar(Widget):
    def start(self, *a):
        pass

    def stop(self):
        pass

    def step(self, *a):
        pass


class Style:
    def __init__(self, master=None):
        pass

    def configure(self, *a, **kw):
        pass

    def theme_use(self, *a):
        return "stub"


# --------------------------------------------------------------------------
# dialog-function stubs (recording; scripted return values)
# --------------------------------------------------------------------------


class _CallRecorder:
    """Callable that records invocations and pops scripted results."""

    def __init__(self, default=None):
        self.calls: list[tuple[tuple, dict]] = []
        self.results: list[Any] = []
        self.default = default

    def script(self, *results):
        self.results.extend(results)

    def __call__(self, *args, **kw):
        self.calls.append((args, kw))
        if self.results:
            return self.results.pop(0)
        return self.default


def _make_dialog_modules():
    filedialog = types.ModuleType("tkinter.filedialog")
    filedialog.askopenfilename = _CallRecorder(default="")
    filedialog.asksaveasfilename = _CallRecorder(default="")
    filedialog.askdirectory = _CallRecorder(default="")

    messagebox = types.ModuleType("tkinter.messagebox")
    messagebox.showerror = _CallRecorder(default="ok")
    messagebox.showinfo = _CallRecorder(default="ok")
    messagebox.showwarning = _CallRecorder(default="ok")
    messagebox.askyesno = _CallRecorder(default=True)
    messagebox.askokcancel = _CallRecorder(default=True)

    simpledialog = types.ModuleType("tkinter.simpledialog")
    simpledialog.askstring = _CallRecorder(default=None)
    simpledialog.askinteger = _CallRecorder(default=None)
    simpledialog.askfloat = _CallRecorder(default=None)
    return filedialog, messagebox, simpledialog


# --------------------------------------------------------------------------
# matplotlib canvas over the real Agg renderer
# --------------------------------------------------------------------------


def _make_tkagg_module():
    from matplotlib.backends.backend_agg import FigureCanvasAgg

    class FigureCanvasTkAgg(FigureCanvasAgg):
        def __init__(self, figure, master=None):
            super().__init__(figure)
            self._tk_widget = Canvas(master)

        def get_tk_widget(self):
            return self._tk_widget

        def draw_idle(self):
            # render immediately through Agg so figure errors surface in CI
            self.draw()

    mod = types.ModuleType("matplotlib.backends.backend_tkagg")
    mod.FigureCanvasTkAgg = FigureCanvasTkAgg

    class NavigationToolbar2Tk:
        def __init__(self, canvas, window=None, *, pack_toolbar=True):
            self.canvas = canvas

        def update(self):
            pass

    mod.NavigationToolbar2Tk = NavigationToolbar2Tk
    return mod


# --------------------------------------------------------------------------
# installation
# --------------------------------------------------------------------------

_UI_MODULES = (
    "qpsim_tpu.ui.theme",
    "qpsim_tpu.ui.playback",
    "qpsim_tpu.ui.run_worker",
    "qpsim_tpu.ui.dialogs",
    "qpsim_tpu.ui.viewers",
    "qpsim_tpu.ui.launch_dialog",
    "qpsim_tpu.ui.setup_editor",
    "qpsim_tpu.ui.main_app",
    "qpsim_tpu.ui",
)


def _build_tkinter_module():
    tk_mod = types.ModuleType("tkinter")
    for name, obj in globals().items():
        if isinstance(obj, type) or name in ("END", "TclError"):
            setattr(tk_mod, name, obj)
    tk_mod.BOTH, tk_mod.X, tk_mod.Y = "both", "x", "y"
    tk_mod.LEFT, tk_mod.RIGHT, tk_mod.TOP, tk_mod.BOTTOM = "left", "right", "top", "bottom"
    tk_mod.W, tk_mod.E, tk_mod.N, tk_mod.S = "w", "e", "n", "s"
    tk_mod.HORIZONTAL, tk_mod.VERTICAL = "horizontal", "vertical"
    tk_mod.NORMAL, tk_mod.DISABLED = "normal", "disabled"
    tk_mod.WORD = "word"

    ttk_mod = types.ModuleType("tkinter.ttk")
    for cls in (Combobox, Treeview, Notebook, Progressbar, Style):
        setattr(ttk_mod, cls.__name__, cls)
    for cls in (Frame, Label, Button, Entry, Checkbutton, Radiobutton, Scrollbar):
        setattr(ttk_mod, cls.__name__, cls)

    filedialog, messagebox, simpledialog = _make_dialog_modules()
    tk_mod.ttk = ttk_mod
    tk_mod.filedialog = filedialog
    tk_mod.messagebox = messagebox
    tk_mod.simpledialog = simpledialog
    return tk_mod, ttk_mod, filedialog, messagebox, simpledialog


@contextlib.contextmanager
def installed():
    """Install the stub as ``tkinter`` (+ submodules, + the TkAgg backend),
    purging and restoring the real modules and the qpsim_tpu.ui package."""
    global _modal_handlers
    _modal_handlers = []
    tk_mod, ttk_mod, filedialog, messagebox, simpledialog = _build_tkinter_module()
    tkagg = _make_tkagg_module()
    replaced = {
        "tkinter": tk_mod,
        "tkinter.ttk": ttk_mod,
        "tkinter.filedialog": filedialog,
        "tkinter.messagebox": messagebox,
        "tkinter.simpledialog": simpledialog,
        "matplotlib.backends.backend_tkagg": tkagg,
    }
    saved = {}
    for name, mod in replaced.items():
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    saved_ui = {}
    for name in _UI_MODULES:
        saved_ui[name] = sys.modules.pop(name, None)
    try:
        yield types.SimpleNamespace(
            tk=tk_mod,
            ttk=ttk_mod,
            filedialog=filedialog,
            messagebox=messagebox,
            simpledialog=simpledialog,
            pump=pump,
            on_next_modal=on_next_modal,
        )
    finally:
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod
        # drop the stub-based ui modules; restore any pre-existing real ones
        for name in _UI_MODULES:
            sys.modules.pop(name, None)
            if saved_ui[name] is not None:
                sys.modules[name] = saved_ui[name]


def fresh_ui_modules() -> dict[str, types.ModuleType]:
    """Import the qpsim_tpu.ui modules over whatever tkinter is installed."""
    out = {}
    for name in _UI_MODULES:
        if name == "qpsim_tpu.ui":
            continue
        mod = importlib.import_module(name)
        out[name.rsplit(".", 1)[1]] = mod
    return out


# --------------------------------------------------------------------------
# widget-tree helpers for tests
# --------------------------------------------------------------------------


def walk(widget) -> list:
    found = [widget]
    for child in getattr(widget, "children_", ()):
        found.extend(walk(child))
    return found


def find_widgets(root, cls) -> list:
    return [w for w in walk(root) if isinstance(w, cls)]


def find_button(root, text: str):
    for w in walk(root):
        if isinstance(w, Button) and w.options.get("text") == text:
            return w
    raise LookupError(f"no Button with text {text!r} under {root!r}")
