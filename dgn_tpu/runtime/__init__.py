"""Native (C++) runtime components: the batch packer.

See packer.cpp for the component itself and native.py for the ctypes
bindings; graph.pack_graphs(native=...) is the integration point.
"""
from .native import available, pack_edges

__all__ = ["available", "pack_edges"]
