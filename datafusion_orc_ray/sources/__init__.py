"""Sources: stripe reader -> ray.data.Dataset, fragment planning."""
