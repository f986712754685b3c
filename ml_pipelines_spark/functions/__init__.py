"""Scalar/column function library: strings, text analysis, geometry."""
