"""Placeholder — queries land in a later milestone this round."""
