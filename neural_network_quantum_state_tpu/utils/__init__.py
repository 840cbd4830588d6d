"""Utility subsystems: checkpointing, metrics, CLI config."""

__all__ = []
