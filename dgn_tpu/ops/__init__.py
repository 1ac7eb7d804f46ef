from . import aggregators, scalers, segment
