package bakerspark;

import com.github.luben.zstd.ZstdInputStream;
import com.github.luben.zstd.ZstdOutputStream;
import java.io.IOException;
import java.io.InputStream;
import java.io.OutputStream;
import org.apache.hadoop.conf.Configurable;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.io.compress.CompressionCodec;
import org.apache.hadoop.io.compress.CompressionInputStream;
import org.apache.hadoop.io.compress.CompressionOutputStream;
import org.apache.hadoop.io.compress.Compressor;
import org.apache.hadoop.io.compress.Decompressor;

/**
 * Hadoop CompressionCodec over zstd-jni (which Spark already ships for
 * parquet/shuffle and which bundles its own native library) -- bridges
 * the gap that Hadoop's own ZStandardCodec needs a native libhadoop
 * this environment doesn't have. Gives FileWriter the reference
 * engine's default .zst output format (filewriter.go:26-99, level
 * default 3 mirrored from ZstdCompressionLevel).
 *
 * Stream-only: the pooled Compressor/Decompressor interfaces return
 * null, which Hadoop's CodecPool tolerates (it falls back to the
 * stream constructors this class does implement). Write path: Spark's
 * CodecStreams calls createOutputStream(out). Read path:
 * LineRecordReader calls createInputStream(in, null).
 */
public class ZstdJniCodec implements CompressionCodec, Configurable {
    public static final String LEVEL_KEY = "bakerspark.zstd.level";
    /** zstd long-distance-matching window log (the reference's
     * ZstdWindowLog, output/filewriter.go:99,388 — its published bench
     * config uses 27). 0 = disabled, matching the reference default. */
    public static final String WINDOWLOG_KEY = "bakerspark.zstd.windowlog";
    private Configuration conf;

    @Override
    public void setConf(Configuration c) {
        this.conf = c;
    }

    @Override
    public Configuration getConf() {
        return conf;
    }

    /** FilterOutputStream whose close() only flushes — lets the zstd
     * stream's close() end its frame without closing the real sink. */
    private static final class NonClosing extends java.io.FilterOutputStream {
        NonClosing(OutputStream out) {
            super(out);
        }

        @Override
        public void write(byte[] b, int off, int len) throws IOException {
            out.write(b, off, len); // FilterOutputStream's default is per-byte
        }

        @Override
        public void close() throws IOException {
            out.flush();
        }
    }

    @Override
    public CompressionOutputStream createOutputStream(final OutputStream out)
            throws IOException {
        final int level = conf == null ? 3 : conf.getInt(LEVEL_KEY, 3);
        final int windowLog = conf == null ? 0 : conf.getInt(WINDOWLOG_KEY, 0);
        return new CompressionOutputStream(out) {
            private ZstdOutputStream z = null;
            private boolean closed = false;

            private ZstdOutputStream ensure() throws IOException {
                if (z == null) {
                    z = new ZstdOutputStream(new NonClosing(out), level);
                    if (windowLog > 0) {
                        z.setLong(windowLog); // enables LDM at this window size
                    }
                }
                return z;
            }

            @Override
            public void write(int b) throws IOException {
                ensure().write(b);
            }

            @Override
            public void write(byte[] b, int off, int len) throws IOException {
                ensure().write(b, off, len);
            }

            @Override
            public void finish() throws IOException {
                // Hadoop's contract: finish() writes the stream trailer but
                // keeps the underlying stream open. Closing the zstd stream
                // ends its frame; the NonClosing shim keeps `out` alive, and
                // a later write() opens a fresh frame (the read path sets
                // setContinuous(true), so multi-frame files read through).
                if (z != null) {
                    z.close();
                    z = null;
                }
            }

            @Override
            public void resetState() throws IOException {
            }

            @Override
            public void flush() throws IOException {
                if (z != null) {
                    z.flush();
                }
                out.flush();
            }

            @Override
            public void close() throws IOException {
                if (!closed) {
                    closed = true;
                    ensure().close(); // empty write -> still a valid empty frame
                    z = null;
                    out.close();
                }
            }
        };
    }

    @Override
    public CompressionOutputStream createOutputStream(OutputStream out, Compressor compressor)
            throws IOException {
        return createOutputStream(out);
    }

    @Override
    public Class<? extends Compressor> getCompressorType() {
        return null; // stream-only; CodecPool handles null by not pooling
    }

    @Override
    public Compressor createCompressor() {
        return null;
    }

    @Override
    public CompressionInputStream createInputStream(InputStream in) throws IOException {
        final ZstdInputStream z = new ZstdInputStream(in);
        z.setContinuous(true); // multi-frame files (concatenated .zst) read through
        // accept frames written with windowLog up to 31: the library's
        // default decode limit (27) rejects long-range frames past it,
        // which is the ">27 needs special treatment" in the reference's
        // ZstdWindowLog help text -- the treatment lives here
        z.setLongMax(31);
        return new CompressionInputStream(in) {
            @Override
            public int read() throws IOException {
                return z.read();
            }

            @Override
            public int read(byte[] b, int off, int len) throws IOException {
                return z.read(b, off, len);
            }

            @Override
            public void resetState() throws IOException {
            }

            @Override
            public void close() throws IOException {
                z.close();
            }
        };
    }

    @Override
    public CompressionInputStream createInputStream(InputStream in, Decompressor decompressor)
            throws IOException {
        return createInputStream(in);
    }

    @Override
    public Class<? extends Decompressor> getDecompressorType() {
        return null;
    }

    @Override
    public Decompressor createDecompressor() {
        return null;
    }

    @Override
    public String getDefaultExtension() {
        return ".zst";
    }
}
