from tec_mollm_tpu.training.loss import huber_loss
from tec_mollm_tpu.training.schedule import cosine_annealing_warm_restarts
from tec_mollm_tpu.training.optimizer import build_optimizer, trainable_mask
from tec_mollm_tpu.training.train_state import TrainState, create_train_state

__all__ = [
    "huber_loss",
    "cosine_annealing_warm_restarts",
    "build_optimizer",
    "trainable_mask",
    "TrainState",
    "create_train_state",
]
