"""Manifests, checkpoint/resume state."""
