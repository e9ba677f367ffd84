"""SBN-parameter model holder (vip/sbn_model.py parity).

The reference's ``SBNModel`` is a stub holding a zero-copy numpy view of the
instance's flat sbn_parameters vector; the view stays live because the C++
vector is mutated in place. Here instance methods may REASSIGN the array
(train_simple_average etc.), so the model proxies the attribute instead of
capturing one array: ``model.sbn_parameters`` always aliases the instance's
current array, and in-place writes through it are seen by the instance —
the same aliasing contract, robust to retraining.
"""

import numpy as np


class SBNModel:
    def __init__(self, inst):
        self._inst = inst

    @property
    def sbn_parameters(self) -> np.ndarray:
        return self._inst.sbn_parameters

    @sbn_parameters.setter
    def sbn_parameters(self, value):
        self._inst.sbn_parameters = np.asarray(value)
