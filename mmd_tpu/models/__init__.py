from mmd_tpu.models.fusion import (
    MisinformationDetectionModel,
    init_fusion_params,
    fusion_forward,
)
