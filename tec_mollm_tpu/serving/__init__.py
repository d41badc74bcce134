from tec_mollm_tpu.serving.server import ForecastService, serve

__all__ = ["ForecastService", "serve"]
