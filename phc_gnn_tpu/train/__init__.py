"""Training harness (L5): config, losses, evaluators, optimizer, state,
checkpointing, trainer."""

from phc_gnn_tpu.train.config import DATASET_DEFAULTS, ExperimentConfig
from phc_gnn_tpu.train.evaluators import EVALUATORS, get_evaluator
from phc_gnn_tpu.train.loss import (
    masked_bce_with_logits,
    masked_cross_entropy,
    masked_l1,
    masked_mse,
)
from phc_gnn_tpu.train.optim import ReduceLROnPlateau, make_optimizer
from phc_gnn_tpu.train.state import (
    TrainState,
    create_train_state,
    make_accum_train_step,
    make_eval_step,
    make_scan_train_steps,
    make_train_step,
)
from phc_gnn_tpu.train.trainer import Trainer, build_loss, build_model
from phc_gnn_tpu.train.checkpoint import CheckpointManager
