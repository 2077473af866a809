from cama_tpu.io.clip import ClipReader
from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.io.scene import Scene, compile_scene

__all__ = ["ClipReader", "make_fixture_clip", "Scene", "compile_scene"]
