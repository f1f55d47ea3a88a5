"""Shared setup for the e2e scratch benches.

Re-exports bench.py's own builders so surgery numbers always measure the
benchmark's exact model stack and input signal (one definition, no drift).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import build_iface, make_sig  # noqa: E402,F401
