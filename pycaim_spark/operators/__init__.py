"""Custom operators that go beyond single DataFrame expressions."""
