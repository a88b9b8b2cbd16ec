patched
