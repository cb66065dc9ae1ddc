"""Training layer: losses, jitted steps, states, orchestration."""

from spoofsv_tpu.train.losses import (  # noqa: F401
    binary_divergence,
    guided_attention_loss,
    guided_attention_matrix,
    l1_loss,
    ssrn_losses,
    text2mel_losses,
)
from spoofsv_tpu.train.state import AdvTrainState, TrainState  # noqa: F401
from spoofsv_tpu.train.steps import (  # noqa: F401
    make_adversarial_steps,
    make_eval_step,
    make_fused_adversarial_step,
    make_optimizer,
    make_ordinary_step,
    shift_right,
)
from spoofsv_tpu.train.loop import (  # noqa: F401
    CheckpointManager,
    MetricsLogger,
    Trainer,
)
