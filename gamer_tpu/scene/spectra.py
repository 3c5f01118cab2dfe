"""Named RGB spectra (source/galaxy/spectrum.h:50-72).

Lookup is case-insensitive; a missing name falls back to the default white
spectrum, mirroring ``Galaxy::SetupSpectra`` (galaxy.cpp:75-85).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

Vec3 = Tuple[float, float, float]

# Built-ins from Spectra::PopulateSpectra (spectrum.h:50-58). Values are the
# f32-exact constants the reference stores in QVector3D.
BUILTIN_SPECTRA: Dict[str, Vec3] = {
    "red": (1.0, 0.6, 0.4),
    "yellow": (1.0, 0.9, 0.45),
    "blue": (0.4, 0.6, 1.0),
    "white": (1.0, 1.0, 1.0),
    "cyan": (0.3, 0.7, 1.0),
    "purple": (1.0, 0.3, 0.8),
}

DEFAULT_SPECTRUM: Vec3 = (1.0, 1.0, 1.0)


def find_spectrum(name: str, table: Optional[Mapping[str, Vec3]] = None) -> Vec3:
    """Case-insensitive spectrum lookup with white fallback."""
    tbl = BUILTIN_SPECTRA if table is None else {k.lower(): v for k, v in table.items()}
    return tbl.get(name.lower(), DEFAULT_SPECTRUM)


def verify_spectra(names, table: Optional[Mapping[str, Vec3]] = None) -> str:
    """Return the first unknown spectrum name, or '' if all resolve.

    Parity with Galaxy::VerifySpectra (galaxy.cpp:87-95).
    """
    tbl = BUILTIN_SPECTRA if table is None else {k.lower(): v for k, v in table.items()}
    for n in names:
        if n.lower() not in tbl:
            return n
    return ""
