"""Import-time stub for ``sleap_io`` (reference: eks/utils.py:8).

The parity suite only exercises CSV datasets; ``.slp`` reading raises."""
