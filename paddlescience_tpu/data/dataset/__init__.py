from paddlescience_tpu.data.dataset.array_dataset import (  # noqa: F401
    ContinuousNamedArrayDataset,
    DeviceSampledDataset,
    IterableNamedArrayDataset,
    NamedArrayDataset,
)
from paddlescience_tpu.data.dataset.file_dataset import (  # noqa: F401
    CSVDataset,
    IterableCSVDataset,
    IterableMatDataset,
    IterableNPZDataset,
    MatDataset,
    NPZDataset,
)
