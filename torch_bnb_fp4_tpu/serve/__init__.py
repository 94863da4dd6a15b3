from .engine import Completion, Engine, EngineConfig, Request, prompt_lookup_draft
from .multihost import MultihostEngineServer, follow
from .server import EngineServer

__all__ = [
    "Engine",
    "EngineConfig",
    "Request",
    "Completion",
    "prompt_lookup_draft",
    "EngineServer",
    "MultihostEngineServer",
    "follow",
]
