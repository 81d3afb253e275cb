from sisr_tpu.data.pipeline import (  # noqa: F401
    SyntheticDataset,
    ImageFolderDataset,
    MNISTDataset,
    make_dataset,
    BatchLoader,
    DoubleLoader,
    build_data,
)
