from evplp_tpu.scene.scene import SceneData, build_scene  # noqa: F401
from evplp_tpu.scene.config import load_config  # noqa: F401
