from .manager import Resource, ResourceManager

__all__ = ["Resource", "ResourceManager"]
