"""Make the framework importable when running `cd p2p && python edit_real.py`
(the reference's invocation style, README.md:44-48)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
