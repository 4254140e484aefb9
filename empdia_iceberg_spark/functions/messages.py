"""Placeholder — filled in a later slice this round."""
