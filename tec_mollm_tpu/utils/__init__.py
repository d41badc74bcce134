from tec_mollm_tpu.utils.logging import setup_logging
from tec_mollm_tpu.utils.run_name import make_run_name

__all__ = ["setup_logging", "make_run_name"]
