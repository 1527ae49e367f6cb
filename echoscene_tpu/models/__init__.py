from .config import EchoSceneConfig, load_config
from .echo_scene import EchoSceneModule
from .sgdiff import SGDiff
