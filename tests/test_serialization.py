"""Serialization tests (npz + state-dict; pickle is in test_pickle.py)."""

import numpy as np
from hypothesis import given

from csr_tpu.utils import serialization
from csr_tpu.test_utils import csrs
from util import to_dense


@given(csrs())
def test_npz_roundtrip(tmp_path_shared, csr):
    path = tmp_path_shared / "m.npz"
    serialization.save_npz(path, csr)
    c2 = serialization.load_npz(path)
    assert (c2.values is None) == (csr.values is None)
    np.testing.assert_allclose(to_dense(c2), to_dense(csr), rtol=1e-6)


@given(csrs())
def test_state_dict_roundtrip(csr):
    d = serialization.to_state_dict(csr)
    c2 = serialization.from_state_dict(d)
    assert c2.nrows == csr.nrows and c2.ncols == csr.ncols
    np.testing.assert_allclose(to_dense(c2), to_dense(csr), rtol=1e-6)
