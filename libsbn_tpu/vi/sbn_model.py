"""SBN-parameter model holder (vip/sbn_model.py parity).

The reference's ``SBNModel`` is a stub holding a zero-copy numpy view of the
instance's flat sbn_parameters vector. Here the instance's ``sbn_parameters``
is already a plain numpy array, so the "view" is the array itself: writes
through ``model.sbn_parameters[...]`` are seen by the instance, matching the
reference's aliasing semantics.
"""

import numpy as np


class SBNModel:
    def __init__(self, inst):
        self.sbn_parameters = np.asarray(inst.sbn_parameters)
