"""Native (C++) host-runtime components. See nbodycore.cpp and binding.py."""
