from . import kernels, eos, celldiv, forces, integrators  # noqa: F401
