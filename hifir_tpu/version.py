"""Version info.

Mirrors the reference version macros (``/root/reference/src/hif/version.h:46-48``):
the reference is v0.2.0; we track our own framework version independently.
"""

__version__ = "0.1.0"

VERSION_MAJOR = 0
VERSION_MINOR = 1
VERSION_PATCH = 0


def version() -> str:
    """Return the framework version string (ref: ``src/hifir.hpp:52``)."""
    return __version__
