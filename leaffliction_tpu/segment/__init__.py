from leaffliction_tpu.segment.mask import make_mask  # noqa: F401
