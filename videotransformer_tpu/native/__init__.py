"""Native (C++) components: FFmpeg video decoder. Built lazily with g++."""
