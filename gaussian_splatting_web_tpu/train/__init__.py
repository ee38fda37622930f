from .loss import l1_loss, ssim, photometric_loss
from .trainer import TrainState, make_train_step, make_optimizer

__all__ = [
    "l1_loss",
    "ssim",
    "photometric_loss",
    "TrainState",
    "make_train_step",
    "make_optimizer",
]
