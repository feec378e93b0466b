"""Input pipeline (ref: models/dataset.py), host-side numpy -> sharded HBM."""

from music_style_transfer_ldm_tpu.datasets.folder import (  # noqa: F401
    SpectrogramDataset, SpectrogramPairDataset, generate_pairings,
    list_image_folder, load_image_unit,
)
from music_style_transfer_ldm_tpu.datasets.loader import (  # noqa: F401
    BatchLoader, PackedBatchLoader, prepare_dataset, process_local_indices,
    train_test_split,
)
from music_style_transfer_ldm_tpu.datasets.packed import (  # noqa: F401
    PackedPairDataset, PackedSpectrogramDataset, build_pack,
)
from music_style_transfer_ldm_tpu.datasets.device import (  # noqa: F401
    DevicePairLoader, DeviceResidentPairs,
)
