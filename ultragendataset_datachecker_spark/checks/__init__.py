"""Check library: every check is a pure builder of Spark Column expressions /
DataFrame transforms — the registry analogue of the reference's validator
registry (/root/reference/dataset_checker/checks/data_format.py:145-158),
except checks return Catalyst expressions instead of per-row Python.
"""
