"""Command-line entry points (reference L7-L10 surface, SURVEY.md §1):

  train_vqvae         stage-1 (E)VQ-VAE training        (ref train/train_*_vqvae.py)
  train_diffusion     stage-2 LG-LDM training           (ref train/train_diffusion_*.py)
  sample_vqvae        stage-1 round-trip reconstruction (ref samples/sample_*_vqvae.py)
  sample_diffusion    audio -> vertices over a split    (ref samples/sample_diffusion_*.py)
  demo                one wav -> animation .npy         (ref demo/demo_*.py)
  serve               resident batching HTTP server     (beyond the reference)
  metrics             FVE/LVE/EME/MVE/FDD/diversity     (ref metric/metric.py, computer_metrix.py)
  correlation         matched-vs-mismatched learning evidence (beyond the reference)
  render              .npy -> .mp4                      (ref render/render*.py)
  preprocess_vocaset  raw VOCASET -> per-sequence files (ref vocaset/process_voca_data.py)
  preprocess_mead_audio  MEAD .m4a -> 16 kHz mono .wav  (ref data_loader_mead.py librosa decode)
  convert_weights     reference torch / HF checkpoints -> .msgpack params

All run as `python -m fdm_tpu.cli.<name>` or `python -m fdm_tpu <name>`.
"""

COMMANDS = (
    "train_vqvae",
    "train_diffusion",
    "sample_vqvae",
    "sample_diffusion",
    "demo",
    "serve",
    "metrics",
    "correlation",
    "render",
    "preprocess_vocaset",
    "preprocess_mead_audio",
    "convert_weights",
)
