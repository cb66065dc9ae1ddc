"""Host-side data pipeline: corpus prep, features, bucketing, text frontend."""

from spoofsv_tpu.data.pipeline import BucketedLoader, TTSDataSource, pad_batch  # noqa: F401
from spoofsv_tpu.data.text import build_char2idx, encode_texts, text2id  # noqa: F401
from spoofsv_tpu.data.vctk import prepare_vctk, split_speaker_files  # noqa: F401
