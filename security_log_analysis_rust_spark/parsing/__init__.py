"""Line-parsing bank: pure-Python reference core + vectorized pandas UDFs."""
