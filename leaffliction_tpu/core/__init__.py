from leaffliction_tpu.core.logging import get_logger, setup_logging  # noqa: F401
