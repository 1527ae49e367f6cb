from .service import GenerationService, request_to_example  # noqa: F401
