"""fdm_tpu — a TPU-native (JAX/XLA/Pallas) framework for expressive 3D facial
animation generation via local-to-global latent diffusion.

Re-designed from scratch with the capabilities of the reference system
(wangxuanx/Face-Diffusion-Model, TVCG 2024): a two-stage audio→3D-face pipeline

  stage 1: EVQ-VAE   — transformer VQ-VAE over per-frame vertex displacements
                       (emotion-partitioned codebook for 3D MEAD)
  stage 2: LG-LDM    — x0-parameterized latent DDPM whose denoiser (FDM) is a
                       transformer decoder cross-attending to HuBERT/wav2vec2
                       audio features, conditioned on timestep/emotion/speaker.

TPU-first design notes (vs the CUDA/torch reference):
  * sampling loops are `jax.lax.scan`s with the audio encoder hoisted out of
    the denoise loop (the reference re-runs HuBERT inside every one of its
    1000 DDPM steps — see reference models/fdm_vqvae_mead.py:70);
  * the reference's diagonal-only cross-attention memory mask
    (reference models/fdm.py:156-164) makes cross-attention algebraically a
    per-frame linear map of the aligned audio feature — the fast path exploits
    this exactly instead of materializing a (T, S) masked attention;
  * static shapes everywhere: sequences are padded to frame buckets with
    length masks through attention, quantization and losses;
  * data parallelism via `jax.sharding.Mesh` + NamedSharding (no NCCL port —
    the reference is single-GPU);
  * hot ops (bias-attention, codebook search, adaIN) have Pallas TPU kernels
    in `fdm_tpu.kernels` with XLA fallbacks.
"""

__version__ = "0.1.0"
