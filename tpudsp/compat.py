"""Drop-in stand-in for the reference's ``liquiddsp`` extension module:

    import tpudsp.compat as liquiddsp

exposes exactly the 29 classes + bytes_to_iq the reference binds
(wrapper.cpp:10-273), with the same names, kwargs and defaults.
"""

from .ops import *  # noqa: F401,F403
from .ops import __all__  # noqa: F401
