from . import framefft
