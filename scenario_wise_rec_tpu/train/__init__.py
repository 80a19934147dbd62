from .callback import EarlyStopper
from .loss import bce_loss, bpr_loss, hinge_loss
from .metrics import auc_score, auc_score_device, log_loss_score, topk_metrics
from .optim import adam, step_lr
from .trainer import CTRTrainer
from . import checkpoint

__all__ = [
    "CTRTrainer",
    "EarlyStopper",
    "adam",
    "step_lr",
    "bce_loss",
    "hinge_loss",
    "bpr_loss",
    "auc_score",
    "auc_score_device",
    "log_loss_score",
    "topk_metrics",
    "checkpoint",
]
