"""Example applications — the framework's "model zoo", mirroring the five
reference apps (SURVEY.md §2.8): conway, jacobi, hotspot, fdtd, convection.
Each module exposes the kernel(s), a functional ``run`` helper, and a CLI
``main`` compatible with the reference binary's interface.
"""

from . import convection, conway, fdtd, hotspot, jacobi

__all__ = ["convection", "conway", "fdtd", "hotspot", "jacobi"]
