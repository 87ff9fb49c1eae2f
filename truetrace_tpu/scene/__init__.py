from truetrace_tpu.scene.ir import (  # noqa: F401
    Scene, MaterialTable, MeshTable, LightTris, Camera, EnvMap,
    AnalyticLights,
)
from truetrace_tpu.scene import cornell  # noqa: F401
