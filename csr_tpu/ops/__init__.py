"""
Pallas TPU kernels and their data layouts.

The hot sparse operations live here: micro-block SpMV/SpMM and the
densified SpGEMM.  :mod:`csr_tpu.kernels.pallas` wires them into the
kernel contract.
"""
