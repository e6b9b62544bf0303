from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .ema import ema_decay_weight, ema_update
from .optim import OptimizerConfig, build_optimizer, lr_schedule_factor
from .state import TrainState, create_train_state, make_train_step
from .trainer import Trainer
