"""Geometry kernel.

Host (numpy-vectorized) implementations of the geometry primitives that the
reference keeps in python_util/geometry/ plus the Java hot-loop kernel
(java_util/Util.class). An optional C++ kernel (native/geometry_kernel.cpp,
loaded via ctypes) accelerates the O(N^2 P^2) pairwise loops on host.
"""
from citlab_as_tpu.geometry.rectangle import Rectangle
from citlab_as_tpu.geometry.polygon import (
    Polygon,
    blow_up,
    thin_out,
    norm_poly_dists,
    calc_reg_line_stats,
    string_to_poly,
    poly_to_string,
)

__all__ = [
    "Rectangle",
    "Polygon",
    "blow_up",
    "thin_out",
    "norm_poly_dists",
    "calc_reg_line_stats",
    "string_to_poly",
    "poly_to_string",
]
