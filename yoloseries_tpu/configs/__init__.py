from .config import TrainConfig, load_hyp
