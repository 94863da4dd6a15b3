from .engine import Completion, Engine, EngineConfig, Request

__all__ = ["Engine", "EngineConfig", "Request", "Completion"]
