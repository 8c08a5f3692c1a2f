"""Relational and domain operators. Everything here is a pure
DataFrame → DataFrame function so batch and streaming share one
implementation (kills the reference's batch/stream skew, SURVEY §2.9).
"""
