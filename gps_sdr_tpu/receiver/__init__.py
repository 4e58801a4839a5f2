"""Receiver pipeline stages: CT (tracking+WLS) and VT (vector tracking/EKF)."""
