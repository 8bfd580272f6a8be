import os
import sys

# make fancyrag_ray importable regardless of pytest invocation cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
