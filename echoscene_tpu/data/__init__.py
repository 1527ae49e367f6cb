from .sgfront import SGFrontDataset, SceneExample
from .collate import collate_scenes, CollateSpec
from .clip_text import ClipTextEncoder
