"""Native (C++) acceleration layer. Builds lazily with g++ via native/Makefile;
every consumer treats it as optional and falls back to pure NumPy."""
