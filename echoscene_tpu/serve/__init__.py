from .batcher import MicroBatcher  # noqa: F401
from .service import GenerationService, request_to_example  # noqa: F401
