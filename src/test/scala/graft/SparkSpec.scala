package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession fixture for all suites. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // single-file-bucket scans (BucketedStore / compactBucketed) report
      // their declared sortBy, dropping the SMJ sort on the store side;
      // multi-file buckets are guarded (bucketsContainSingleFile) either way
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      // suites that COUNT scheduler events (SkewStressSpec's straggler
      // audit, GraphBuilderSpec's job counts) share this bus with every
      // concurrently-running suite; at the 10k default the AsyncEventQueue
      // DROPS events under full-suite load and the listener map reads
      // empty even though waitUntilEmpty succeeded (r9 `sbt test` flake)
      .config("spark.scheduler.listenerbus.eventqueue.capacity", "200000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
