"""Expression DSL: acceptance, rejection, numpy/jax backend equivalence."""

import numpy as np
import pytest

from qpsim_tpu.expr.safe_eval import ExpressionError, compile_safe_expression


def test_vectorized_evaluation():
    fn = compile_safe_expression(
        "return np.exp(-((x-0.5)**2)/0.1) * params.get('amp', 2.0)",
        variable_names=("x", "y", "params"),
    )
    x = np.linspace(0, 1, 7)
    out = fn(x=x, y=np.zeros_like(x), params={})
    assert out.shape == x.shape
    assert np.allclose(out, 2.0 * np.exp(-((x - 0.5) ** 2) / 0.1))


def test_scalar_evaluation_and_math_module():
    fn = compile_safe_expression("math.sqrt(x) + 1", variable_names=("x",))
    assert fn(x=4.0) == 3.0


def test_return_prefix_stripped():
    fn = compile_safe_expression("return 5.0", variable_names=())
    assert fn() == 5.0


def test_empty_expression_is_zero():
    fn = compile_safe_expression("", variable_names=())
    assert fn() == 0.0


@pytest.mark.parametrize(
    "bad",
    [
        "__import__('os').system('true')",
        "open('/etc/passwd')",
        "x.__class__",
        "np.load('x.npy')",
        "lambda: 1",
        "[i for i in range(3)]",
        "x if True else exec('1')",
        "getattr(np, 'load')",
        "params.update({})",
        "np.random.rand(3)",
    ],
)
def test_rejects_unsafe(bad):
    with pytest.raises(ExpressionError):
        compile_safe_expression(bad, variable_names=("x", "params"))


def test_multiline_rejected():
    with pytest.raises(ExpressionError):
        compile_safe_expression("x = 1\nx + 1", variable_names=("x",))


def test_missing_variable_raises():
    fn = compile_safe_expression("x + y", variable_names=("x", "y"))
    with pytest.raises(ExpressionError):
        fn(x=1.0)


def test_jax_backend_matches_numpy():
    import jax.numpy as jnp

    src = "return np.where(x > 0.5, np.exp(-x), np.sqrt(np.maximum(x, 0.0)))"
    f_np = compile_safe_expression(src, variable_names=("x",), backend="numpy")
    f_jx = compile_safe_expression(src, variable_names=("x",), backend="jax")
    x = np.linspace(0, 1, 11)
    np.testing.assert_allclose(np.asarray(f_jx(x=jnp.asarray(x))), f_np(x=x), rtol=1e-12)


def test_jax_backend_is_traceable():
    import jax
    import jax.numpy as jnp

    fn = compile_safe_expression(
        "return np.sin(x) * t", variable_names=("x", "t"), backend="jax"
    )
    jitted = jax.jit(lambda x, t: fn(x=x, t=t))
    out = jitted(jnp.asarray([0.1, 0.2]), 2.0)
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.sin([0.1, 0.2]), rtol=1e-6)


def test_jax_backend_differential_fuzz():
    """Generated expression corpus: the jax backend must agree with the
    numpy backend on every whitelisted construct it can trace."""
    import random

    import jax.numpy as jnp

    rng = random.Random(0)
    unary = ["np.sqrt", "np.exp", "np.sin", "np.cos", "np.tanh", "np.abs",
             "np.log", "abs"]
    binary = ["+", "-", "*", "/", "**"]

    def leaf():
        return rng.choice(["x", "y", "t", str(round(rng.uniform(0.1, 3.0), 3)),
                           "np.pi", "np.e"])

    def expr(depth):
        if depth == 0:
            return leaf()
        k = rng.randrange(5)
        if k == 0:
            # keep args positive for sqrt/log domains
            return f"{rng.choice(unary)}(np.abs({expr(depth - 1)}) + 0.1)"
        if k == 1:
            op = rng.choice(binary)
            a, b = expr(depth - 1), expr(depth - 1)
            if op == "**":
                return f"(np.abs({a}) + 0.1) ** 1.5"
            if op == "/":
                return f"({a}) / (np.abs({b}) + 0.5)"
            return f"({a}) {op} ({b})"
        if k == 2:
            return f"np.where(({expr(depth - 1)}) > 0.5, {expr(depth - 1)}, {expr(depth - 1)})"
        if k == 3:
            return f"np.maximum({expr(depth - 1)}, {expr(depth - 1)})"
        # (python ternaries need scalar conditions — np.where covers arrays)
        return f"np.clip({expr(depth - 1)}, 0.0, 2.0)"

    npr = np.random.default_rng(1)
    x = npr.uniform(0.0, 1.0, 64)
    y = npr.uniform(0.0, 1.0, 64)
    checked = 0
    for _ in range(60):
        src = expr(3)
        f_np = compile_safe_expression(src, variable_names=("x", "y", "t"))
        f_jx = compile_safe_expression(
            src, variable_names=("x", "y", "t"), backend="jax"
        )
        try:
            ref = f_np(x=x, y=y, t=0.7)
        except Exception:
            continue  # degenerate scalar-only branch etc.
        got = f_jx(x=jnp.asarray(x), y=jnp.asarray(y), t=0.7)
        np.testing.assert_allclose(
            np.asarray(got, dtype=np.float64), np.asarray(ref, dtype=np.float64),
            rtol=1e-12, atol=1e-12, err_msg=src,
        )
        checked += 1
    assert checked >= 50  # the corpus genuinely exercised both backends
