from .import_torch import import_phi3, t2j
