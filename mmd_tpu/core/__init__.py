from mmd_tpu.core.config import ModelConfig, TrainConfig, MeshConfig
from mmd_tpu.core.mesh import make_mesh, local_mesh
