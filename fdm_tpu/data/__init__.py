from fdm_tpu.data.common import (
    SequenceRecord,
    DataSplits,
    read_wav,
    bucket_frames,
    collate_batch,
    batch_iterator,
)
from fdm_tpu.data.vocaset import load_vocaset
from fdm_tpu.data.biwi import load_biwi
from fdm_tpu.data.mead import load_mead
from fdm_tpu.data.synthetic import (
    envelope_to_motion,
    frame_rms_envelope,
    synthetic_splits,
)

__all__ = [
    "SequenceRecord",
    "DataSplits",
    "read_wav",
    "bucket_frames",
    "collate_batch",
    "batch_iterator",
    "load_vocaset",
    "load_biwi",
    "load_mead",
    "synthetic_splits",
    "envelope_to_motion",
    "frame_rms_envelope",
]
