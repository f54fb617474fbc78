from superresolution_tpu.data.io import (  # noqa: F401
    load_image,
    save_tiff16,
    save_png,
)
from superresolution_tpu.data.manifest import (  # noqa: F401
    load_manifest,
    write_manifest,
    prepare_splits,
)
from superresolution_tpu.data.dataset import (  # noqa: F401
    PairedDataset,
    SyntheticHRDataset,
    make_synthetic_image,
)
from superresolution_tpu.data.augment import paired_augment  # noqa: F401
from superresolution_tpu.data.loader import (  # noqa: F401
    Loader,
    prefetch_to_device,
)
