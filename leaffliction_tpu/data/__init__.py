from leaffliction_tpu.data.manifest import (  # noqa: F401
    ManifestItem,
    build_label_mapping,
    load_manifest,
    save_manifest,
    select_items,
)
