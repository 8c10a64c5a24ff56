from leaffliction_tpu.models.leafcnn import (  # noqa: F401
    LeafCNN,
    SCALE_PRESETS,
    build_leafcnn,
)
