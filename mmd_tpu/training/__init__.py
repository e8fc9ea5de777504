from mmd_tpu.training.losses import multipath_loss, cross_entropy
from mmd_tpu.training.trainer import Trainer, TrainState, make_train_step
