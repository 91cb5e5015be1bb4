"""Parity module for reference ``pyfocusr/main.py`` (banner printing)."""

from .utils.logging import print_header

__all__ = ["print_header"]
