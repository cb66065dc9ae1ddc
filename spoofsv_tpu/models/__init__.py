"""Model zoo: Text2Mel, SSRN, GAN critics, CM classifiers, GE2E embedder."""

from spoofsv_tpu.models.layers import HighwayConv, HighwayDilationStack  # noqa: F401
from spoofsv_tpu.models.text2mel import (  # noqa: F401
    AudioDecoder,
    AudioEncoder,
    DecodeState,
    MelSyn,
    TextEncoder,
)
from spoofsv_tpu.models.ssrn import SSRN, Upsample2x  # noqa: F401
from spoofsv_tpu.models.discriminator import (  # noqa: F401
    DRS,
    Critic1D,
    LinDisc,
    MelDisc,
    ResBasicBlock,
)
from spoofsv_tpu.models.ge2e import (  # noqa: F401
    GE2ELoss,
    SpeechEmbedder,
    calc_loss,
    get_centroids,
    get_cossim,
)
