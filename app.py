"""GUI entry point: python app.py (reference app.py)."""
from qpsim_tpu.ui.main_app import run_app

if __name__ == "__main__":
    run_app()
