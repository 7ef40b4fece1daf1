"""Vectorized Ray Data stages (map_batches functions and actor classes).

Every stage is Arrow-in / Arrow-out (``batch_format="pyarrow"``,
zero-copy from the object store) unless a kernel genuinely needs pandas.
All semantics are pinned by ``dataquality_ray.spec`` — tests assert the
vectorized kernels agree with the scalar spec element-for-element.
"""
