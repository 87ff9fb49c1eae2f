"""Offline tooling: scene inspection/validation (the TPU framework's
analogue of the reference's Unity editor suite)."""
