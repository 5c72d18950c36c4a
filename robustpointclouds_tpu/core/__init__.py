from .config import Config
from .registry import Registry, MODELS, ADVERSARIES, HOOKS, build_adversary

__all__ = ["Config", "Registry", "MODELS", "ADVERSARIES", "HOOKS", "build_adversary"]
