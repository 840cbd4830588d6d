"""pynqs-compatible Python sampling API (reference L9). Populated incrementally."""

__all__ = []
