from . import hf_bridge

__all__ = ["hf_bridge"]
