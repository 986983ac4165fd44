"""Engine function library: Arrow-vectorized UDFs for operations the
Spark built-ins cannot express (SimHash, image decode, SURT — cf.
canonical.py). Everything here is pandas-batch in / batch out."""
