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
from paddlescience_tpu.data.dataset.science_dataset import (  # noqa: F401
    DarcyFlowDataset,
    ERA5Dataset,
    VtuDataset,
    generate_darcy_dataset,
)
from paddlescience_tpu.data.dataset.domain_dataset import (  # noqa: F401
    CGCNNDataset,
    ChipHeatDataset,
    CylinderDataset,
    DGMRDataset,
    ENSODataset,
    ERA5SampledDataset,
    ExtMoEENSODataset,
    FWIDataset,
    GridMeshAtmosphericDataset,
    LorenzDataset,
    MeshAirfoilDataset,
    MeshCylinderDataset,
    MOlFLOWDataset,
    MRMSDataset,
    MRMSSampledDataset,
    PEMSDataset,
    RadarDataset,
    RosslerDataset,
    SEVIRDataset,
    SphericalSWEDataset,
    make_synthetic_graph,
)
