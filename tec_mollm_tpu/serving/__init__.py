from tec_mollm_tpu.serving.export import (
    export_forecaster,
    load_forecaster,
    save_exported,
)
from tec_mollm_tpu.serving.server import ForecastService, serve

__all__ = [
    "ForecastService",
    "serve",
    "export_forecaster",
    "save_exported",
    "load_forecaster",
]
