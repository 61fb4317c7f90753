"""Scalar constants of the A5 DGGS geometry.

Semantics match the reference library (see /root/reference/a5/core/constants.py:11-47
and /root/reference/a5/core/coordinate_transforms.py:21); values are re-derived
from the published dodecahedron geometry, not copied code.
"""

import math

import numpy as np

PHI = (1.0 + math.sqrt(5.0)) / 2.0

TWO_PI = 2.0 * math.pi
TWO_PI_OVER_5 = 2.0 * math.pi / 5.0
PI_OVER_5 = math.pi / 5.0
PI_OVER_10 = math.pi / 10.0

# Dihedral / interhedral angles of the regular dodecahedron.
DIHEDRAL_ANGLE = 2.0 * math.atan(PHI)
INTERHEDRAL_ANGLE = math.pi - DIHEDRAL_ANGLE

# In-face distances (inscribed-sphere radius 1).
DISTANCE_TO_EDGE = (math.sqrt(5.0) - 1.0) / 2.0  # == PHI - 1
DISTANCE_TO_VERTEX = 3.0 - math.sqrt(5.0)

R_INSCRIBED = 1.0
R_MIDEDGE = math.sqrt(3.0 - PHI)
R_CIRCUMSCRIBED = math.sqrt(3.0) * R_MIDEDGE / PHI

AUTHALIC_RADIUS_EARTH = 6371007.2  # meters
AUTHALIC_AREA_EARTH = 4.0 * math.pi * AUTHALIC_RADIUS_EARTH**2  # m^2

# Rotation applied between geodetic longitude and the internal spherical frame
# (reference coordinate_transforms.py:21).
LONGITUDE_OFFSET_DEG = 93.0

DEG2RAD = math.pi / 180.0
RAD2DEG = 180.0 / math.pi

# Cell-ID bit layout (reference serialization.py:8-14).
FIRST_HILBERT_RESOLUTION = 2
MAX_RESOLUTION = 30
HILBERT_START_BIT = 58
WORLD_CELL = np.uint64(0)
