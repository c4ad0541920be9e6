"""Put the repo root on sys.path so tools/*.py run from any cwd
(Python puts only the script's own directory — tools/ — on sys.path).
Usage, first import in every tool:  import _pathfix  # noqa: F401
"""

import os
import sys

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _root not in sys.path:
    sys.path.insert(0, _root)
