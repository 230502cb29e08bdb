package graft.perf

import java.lang.management.ManagementFactory
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** In-process sampling profiler for bench diagnostics (env-gated, never on in
  * driver runs). Samples every thread's state + top stack frames on a fixed
  * interval and aggregates counts, so a query whose executor tasks report
  * run-time far above cpu+gc can be asked the only question that matters:
  * what are those threads actually doing — parked on a lock, in syscall I/O,
  * compiling codegen, or starved by other threads?
  *
  * Interpretation notes: task threads are named "Executor task launch
  * worker-N" in local mode; a top frame in `sun.misc.Unsafe.park` under a
  * ReentrantLock means lock contention (look at the frames below for the
  * owner's class), `FileInputStream.readBytes`/`FileChannelImpl` means disk,
  * and `org.codehaus.janino` on the driver thread means codegen compile.
  */
final class StackSampler(intervalMs: Int = 25, maxFrames: Int = 7, maxKeys: Int = 8000) {
  private val counts = mutable.HashMap.empty[String, Long]
  @volatile private var running = false
  // bumped on every start/stop: a sampler thread that outlives stop()'s
  // bounded join (getAllStackTraces can stall >1s on the loaded JVMs this
  // tool exists to diagnose) sees a stale generation and exits instead of
  // writing the previous query's samples into the next query's counts
  @volatile private var generation = 0L
  private var thread: Thread = _

  /** Normalize a thread name so the map aggregates across pool members:
    * "Executor task launch worker-17" -> "Executor task launch worker-N". */
  private def norm(name: String): String = name.replaceAll("\\d+", "N")

  def start(): Unit = synchronized {
    counts.synchronized(counts.clear())
    generation += 1
    val gen = generation
    running = true
    thread = new Thread(() => {
      while (running && gen == generation) {
        val all = Thread.getAllStackTraces.asScala
        counts.synchronized {
          if (gen == generation) all.foreach { case (t, frames) =>
            if (t ne Thread.currentThread()) {
              val state = t.getState
              // skip pool threads idling between tasks — they park in the
              // pool's take()/poll() and would otherwise dominate the counts
              val top = frames.take(maxFrames).map(f => f.getClassName + "." + f.getMethodName).mkString(" <- ")
              val idle = top.contains("ThreadPoolExecutor.getTask") ||
                top.contains("SynchronousQueue") && top.contains("take") ||
                top.contains("LinkedBlockingQueue.take") ||
                top.contains("AbstractQueuedSynchronizer$ConditionObject.await") && frames.length <= 5
              if (frames.nonEmpty && !idle) {
                val key = norm(t.getName) + " [" + state + "] " + top
                if (counts.size < maxKeys || counts.contains(key))
                  counts(key) = counts.getOrElse(key, 0L) + 1L
              }
            }
          }
        }
        Thread.sleep(intervalMs.toLong)
      }
    }, "graft-stack-sampler")
    thread.setDaemon(true)
    thread.start()
  }

  def stop(): Unit = synchronized {
    running = false
    generation += 1 // invalidate any straggler that outlives the join below
    if (thread != null) { thread.join(1000); thread = null }
  }

  /** Top-k aggregated (thread, state, stack) entries since start(). */
  def top(k: Int): Seq[(String, Long)] = counts.synchronized {
    counts.toSeq.sortBy(-_._2).take(k)
  }
}

/** JVM-level counters that executor-task telemetry cannot see: driver-side
  * JIT time, class counts, metaspace/code-cache occupancy. Deltas across a
  * query expose "the suite, not the plan" costs like codegen-class churn. */
object JvmMetrics {
  def snapshot(): Map[String, Long] = {
    val heap = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
    val classes = ManagementFactory.getClassLoadingMXBean
    val jit = ManagementFactory.getCompilationMXBean
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
    def poolUsedMb(prefix: String): Long =
      pools.filter(_.getName.startsWith(prefix)).map(_.getUsage.getUsed).sum / (1024 * 1024)
    val gcMs = ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    Map(
      "heap_mb" -> heap.getUsed / (1024 * 1024),
      "classes_loaded" -> classes.getLoadedClassCount.toLong,
      "classes_total" -> classes.getTotalLoadedClassCount,
      "jit_ms" -> (if (jit != null && jit.isCompilationTimeMonitoringSupported) jit.getTotalCompilationTime else -1L),
      "metaspace_mb" -> poolUsedMb("Metaspace"),
      "codecache_mb" -> poolUsedMb("CodeHeap"),
      "gc_total_ms" -> gcMs,
    )
  }
}
