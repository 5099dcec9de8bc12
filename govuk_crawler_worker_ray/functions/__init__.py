"""Pure, vectorizable per-record operators (no Ray dependencies).

These are the scalar/batch functions the Ray Data stages are built from;
each reproduces a reference behavior cited in its docstring.
"""
