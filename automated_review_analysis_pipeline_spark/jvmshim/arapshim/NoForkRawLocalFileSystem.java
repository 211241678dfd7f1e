package arapshim;

import java.io.File;
import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.attribute.PosixFilePermission;
import java.util.EnumSet;
import java.util.Set;

import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * RawLocalFileSystem that applies permissions in-process via java.nio
 * instead of forking a /bin/chmod subprocess per file or directory
 * create.
 *
 * Hadoop's RawLocalFileSystem falls back to Shell.execCommand("chmod")
 * whenever libhadoop.so (NativeIO) is absent, and every
 * FileSystem.create()/mkdirs() on the local filesystem passes a
 * non-null FsPermission -- so a local-mode Spark job with many small
 * file writes (state stores, commit protocols, partitioned store
 * appends) forks one subprocess per created file. Forking from a
 * large-heap JVM on a busy host costs 50-200ms a time; thread dumps
 * show task threads parked in Shell.runCommand. This subclass keeps
 * the exact same permission semantics (the caller already applied the
 * umask) through java.nio.file.Files.setPosixFilePermissions, which is
 * a single in-process syscall.
 */
public class NoForkRawLocalFileSystem extends RawLocalFileSystem {
    /** Permission bits in FsPermission.toShort() order, lowest first. */
    private static final PosixFilePermission[] BITS = {
        PosixFilePermission.OTHERS_EXECUTE, PosixFilePermission.OTHERS_WRITE,
        PosixFilePermission.OTHERS_READ,
        PosixFilePermission.GROUP_EXECUTE, PosixFilePermission.GROUP_WRITE,
        PosixFilePermission.GROUP_READ,
        PosixFilePermission.OWNER_EXECUTE, PosixFilePermission.OWNER_WRITE,
        PosixFilePermission.OWNER_READ,
    };

    @Override
    public void setPermission(Path p, FsPermission permission)
            throws IOException {
        short mode = permission.toShort();
        if ((mode & ~0777) != 0) {
            // setuid/setgid/sticky bits have no PosixFilePermission
            // mapping; stock Hadoop applies the full %04o mode via
            // chmod -- keep that behavior for non-rwx bits instead of
            // silently dropping them (round-15 ADVICE)
            super.setPermission(p, permission);
            return;
        }
        File f = pathToFile(p);
        Set<PosixFilePermission> perms =
            EnumSet.noneOf(PosixFilePermission.class);
        for (int i = 0; i < 9; i++) {
            if ((mode & (1 << i)) != 0) {
                perms.add(BITS[i]);
            }
        }
        try {
            Files.setPosixFilePermissions(f.toPath(), perms);
        } catch (UnsupportedOperationException e) {
            // non-POSIX volume: fall back to Hadoop's shell path
            super.setPermission(p, permission);
        }
    }
}
