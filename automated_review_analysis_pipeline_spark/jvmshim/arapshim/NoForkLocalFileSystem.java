package arapshim;

import org.apache.hadoop.fs.LocalFileSystem;

/**
 * Checksummed local filesystem (same CRC sidecar semantics as Hadoop's
 * default LocalFileSystem) over {@link NoForkRawLocalFileSystem}:
 * identical behavior, no chmod subprocess per created file. Wired in
 * through the public fs.file.impl configuration key by
 * session.get_spark (local mode only; see session.py).
 */
public class NoForkLocalFileSystem extends LocalFileSystem {
    public NoForkLocalFileSystem() {
        super(new NoForkRawLocalFileSystem());
    }
}
