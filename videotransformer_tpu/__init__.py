"""videotransformer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-transformer framework.

A from-scratch rebuild of the capabilities of ``mx-mark/VideoTransformer-pytorch``
(reference at /root/reference) designed TPU-first:

- Models (TimeSformer, ViViT, MViT/MaskFeat) are flax.linen modules whose math maps
  onto the MXU (large bf16 matmuls, static shapes, no data-dependent control flow).
- The hot attention paths have Pallas TPU kernels (``videotransformer_tpu.kernels``).
- Parallelism is expressed with ``jax.sharding`` over a device ``Mesh`` — gradients
  reduce via XLA collectives on ICI, not a DDP process group.
- Video decode is a native C++ FFmpeg stage on the host feeding an async prefetch
  queue; all image augmentation runs on device inside XLA.

Reference capability map: see /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: compiles over the remote-compile tunnel
# take 30-300s; caching them on disk makes repeated tool/bench invocations
# start in seconds.
try:  # pragma: no cover
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
