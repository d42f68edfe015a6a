"""Version of the TPU-native satflow rebuild.

Parity anchor: /root/reference/satflow/version.py:1 (reference is 0.3.36).
"""

__version__ = "0.1.0"
