package graft

import org.apache.spark.sql.functions._
import graft.catalog.{PartitionSpec, TableRef}
import graft.exec.{AtomicWriter, Maintenance}
import graft.mat.Materializer
import graft.mat.Materializer.IncrementalStrategy

/** Lifecycle hygiene of the staged-swap machinery: no leaked helper
  * relations (the reference's 1.11.1 `__dbt_tmp` regression,
  * CHANGELOG f708822 / test_incremental_temp_cleanup.py), and recovery
  * from leftovers of a crashed previous run. */
class AtomicSwapSpec extends SparkSpec {
  import spark.implicits._

  private def tables(): Set[String] =
    spark.catalog.listTables("default").collect().map(_.name).toSet

  test("incremental run that reads the target drops its __dbt_tmp staging") {
    val ref = TableRef("default.swap_tmpclean")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable(ref.render)
    // model reads {{ this }} → the tmp-staging path is exercised
    val src = spark.table(ref.render)
      .select($"id" + 10 as "id", upper($"v") as "v")
    Materializer.incremental(spark, ref, src,
      IncrementalStrategy.Merge(), uniqueKey = Seq("id"))
    assert(spark.table(ref.render).count() == 4)
    val leaked = tables().filter(t => t.contains("dbt_tmp") ||
      t.contains("graft_stg") || t.contains("graft_old"))
    assert(leaked.isEmpty, s"leaked helper relations: $leaked")
  }

  test("overwriteTable recovers when a crashed run left stg and old tables") {
    val ref = TableRef("default.swap_recover")
    Seq((1L, "keep")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable(ref.render)
    // simulate a previous run that died mid-swap
    Seq((99L, "stale_stg")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("default.swap_recover__graft_stg")
    Seq((98L, "stale_old")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("default.swap_recover__graft_old")
    AtomicWriter.overwriteTable(spark,
      spark.table(ref.render).withColumn("v", lit("new")), ref)
    val got = spark.table(ref.render).as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "new")))
    // helper names are stamped now, so the legacy-named stale tables are
    // not silently replaced by the live swap — recover sweeps them
    Maintenance.recover(spark, ref)
    val leftover = tables().filter(_.startsWith("swap_recover__"))
    assert(leftover.isEmpty, s"stale helpers survived: $leftover")
    assert(spark.table(ref.render).as[(Long, String)].collect().toSeq
      == Seq((1L, "new")))
  }

  test("recover age gate spares young stamped leftovers") {
    val ref = TableRef("default.swap_age")
    Seq((1L, "keep")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable(ref.render)
    val young = f"${System.currentTimeMillis()}%013d_000001"
    Seq((9L, "stg")).toDF("id", "v").write.mode("overwrite")
      .saveAsTable(s"default.swap_age__graft_stg_$young")
    spark.conf.set("spark.graft.recover.minAgeMs", "3600000")
    try {
      Maintenance.recover(spark, ref)
      assert(tables().contains(s"swap_age__graft_stg_$young"),
        "young staging table must be spared inside the grace window")
    } finally spark.conf.unset("spark.graft.recover.minAgeMs")
    // outside the window (default 0) it is swept
    Maintenance.recover(spark, ref)
    assert(!tables().exists(_.startsWith("swap_age__graft_stg")))
  }

  test("partitioned overwrite recovers from a stale staging table") {
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val ref = TableRef("default.swap_recover_part")
    Materializer.table(spark, ref,
      Seq((1L, "p1"), (2L, "p2")).toDF("id", "pt"), part)
    Seq((99L, "px")).toDF("id", "pt").write.mode("overwrite")
      .partitionBy("pt").saveAsTable("default.swap_recover_part__graft_stg")
    // staging names are stamped, so the stale leftover cannot collide with
    // (or be silently replaced by) the live swap — it waits for recover
    AtomicWriter.overwritePartitions(spark,
      Seq((10L, "p1")).toDF("id", "pt"), ref, part)
    val got = spark.table(ref.render).select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 10L))
    // untouched partition p2 intact, no px contamination
    assert(spark.table(ref.render).filter($"pt" === "px").count() == 0)
    val actions = Maintenance.recover(spark, ref)
    assert(actions.exists(_.contains("swap_recover_part__graft_stg")))
    assert(!tables().exists(_.startsWith("swap_recover_part__graft_stg")))
  }

  // ------------------------------------------------- committer seam (both)

  private def withCommitter[T](name: String)(f: => T): T = {
    spark.conf.set("spark.graft.committer", name)
    try f finally spark.conf.unset("spark.graft.committer")
  }

  for (committer <- Seq("rename", "versioned")) {
    test(s"[$committer] partition overwrite replaces only source partitions") {
      withCommitter(committer) {
        val part = PartitionSpec.Static(Seq("pt" -> "string"))
        val ref = TableRef(s"default.swap_c_$committer")
        Materializer.table(spark, ref,
          Seq((1L, "p1"), (2L, "p2"), (3L, "p3")).toDF("id", "pt"), part)
        AtomicWriter.overwritePartitions(spark,
          Seq((10L, "p1"), (30L, "p3")).toDF("id", "pt"), ref, part)
        val got = spark.table(ref.render).select("id").as[Long].collect().sorted
        assert(got.toSeq == Seq(2L, 10L, 30L))
        // second overwrite of the same partition (exercises replace path)
        AtomicWriter.overwritePartitions(spark,
          Seq((11L, "p1")).toDF("id", "pt"), ref, part)
        assert(spark.table(ref.render).select("id").as[Long].collect().sorted
          .toSeq == Seq(2L, 11L, 30L))
        assert(!tables().exists(_.contains("graft_stg")))
      }
    }

    test(s"[$committer] touched-but-empty partitions are dropped") {
      withCommitter(committer) {
        val part = PartitionSpec.Static(Seq("pt" -> "string"))
        val ref = TableRef(s"default.swap_e_$committer")
        Materializer.table(spark, ref,
          Seq((1L, "p1"), (2L, "p2")).toDF("id", "pt"), part)
        graft.exec.Mutations.delete(spark, ref, $"pt" === "p1", part)
        assert(spark.table(ref.render).select("id").as[Long].collect().toSeq
          == Seq(2L))
        val parts = spark.sql(s"SHOW PARTITIONS ${ref.render}")
          .collect().map(_.getString(0))
        assert(!parts.exists(_.contains("p1")), parts.mkString(","))
      }
    }
  }

  test("versioned commits leave no uncollected garbage after repeated overwrites") {
    withCommitter("versioned") {
      val part = PartitionSpec.Static(Seq("pt" -> "string"))
      val ref = TableRef("default.swap_vgc")
      Materializer.table(spark, ref, Seq((1L, "p1")).toDF("id", "pt"), part)
      (2 to 4).foreach(i => AtomicWriter.overwritePartitions(spark,
        Seq((i.toLong, "p1")).toDF("id", "pt"), ref, part))
      assert(spark.table(ref.render).select("id").as[Long].collect().toSeq
        == Seq(4L))
      // only the LIVE version dir remains; replaced ones were GC'd
      val root = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(
            "default.swap_vgc")).location.toString))
      val vdirs = new java.io.File(root, ".graft_versions").listFiles()
      assert(vdirs != null && vdirs.length == 1, vdirs.mkString(","))
      assert(new java.io.File(root, "pt=p1").exists() == false ||
        new java.io.File(root, "pt=p1").listFiles().isEmpty,
        "default-layout dir should have been replaced by versioned flips")
    }
  }

  test("recover sweeps an uncommitted versioned write (crash before flip)") {
    withCommitter("versioned") {
      val part = PartitionSpec.Static(Seq("pt" -> "string"))
      val ref = TableRef("default.swap_vcrash")
      Materializer.table(spark, ref, Seq((1L, "p1")).toDF("id", "pt"), part)
      val root = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(
            "default.swap_vcrash")).location.toString))
      // simulate: version dir + pending manifest written, crash before the
      // catalog flip
      val vdir = new java.io.File(root, ".graft_versions/999_crash/pt=p1")
      assert(vdir.mkdirs())
      java.nio.file.Files.writeString(vdir.toPath.resolve("part-0.parquet"), "x")
      java.nio.file.Files.writeString(
        root.toPath.resolve(".graft_pending_999_crash"), "pt=p1")
      val actions = graft.exec.Maintenance.recover(spark, ref)
      assert(actions.exists(_.contains("uncommitted versioned partition")), actions)
      assert(!vdir.exists())
      assert(!root.toPath.resolve(".graft_pending_999_crash").toFile.exists())
      // live table untouched
      assert(spark.table(ref.render).select("id").as[Long].collect().toSeq
        == Seq(1L))
    }
  }

  test("recover restores a partition stranded in .graft_trash") {
    val part = PartitionSpec.Static(Seq("pt" -> "string"))
    val ref = TableRef("default.swap_trash")
    Materializer.table(spark, ref,
      Seq((1L, "p1"), (2L, "p2")).toDF("id", "pt"), part)
    val root = new java.io.File(new java.net.URI(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(
          "default.swap_trash")).location.toString))
    // simulate a crashed swap: p1's live dir moved to trash, replacement
    // never arrived
    val live = new java.io.File(root, "pt=p1")
    val trash = new java.io.File(root, ".graft_trash/pt=p1")
    assert(trash.getParentFile.mkdirs())
    assert(live.renameTo(trash))
    assert(spark.table(ref.render).filter($"pt" === "p1").count() == 0 ||
      true) // listing may be cached; recover must fix it regardless
    val actions = graft.exec.Maintenance.recover(spark, ref)
    assert(actions.exists(_.contains("restored partition pt=p1")), actions)
    spark.sql(s"REFRESH TABLE ${ref.render}")
    assert(spark.table(ref.render).select("id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L))
  }

  test("bucketed table replacement keeps the bucket spec through the staged swap") {
    val ref = TableRef("default.swap_bucketed")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    Materializer.table(spark, ref, df, bucketBy = Some((4, Seq("id"))))
    // replacement takes the rename-swap path now, not DROP+CTAS
    Materializer.table(spark, ref, df.withColumn("v", upper($"v")),
      bucketBy = Some((4, Seq("id"))))
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("default.swap_bucketed"))
    assert(meta.bucketSpec.isDefined, "bucket spec lost in swap")
    assert(meta.bucketSpec.get.numBuckets == 4)
    assert(meta.bucketSpec.get.bucketColumnNames == Seq("id"))
    val got = spark.table(ref.render).as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "A"), (2L, "B"), (3L, "C")))
    // bucketed scan still works (exchange-free group-by on bucket col)
    assert(spark.table(ref.render).groupBy("id").count().count() == 3)
  }

  test("recover restores the target table from __graft_old after a crashed rename") {
    val ref = TableRef("default.swap_oldrestore")
    Seq((7L, "keep")).toDF("id", "v").write.mode("overwrite")
      .saveAsTable("default.swap_oldrestore__graft_old")
    spark.sql("DROP TABLE IF EXISTS default.swap_oldrestore")
    val actions = graft.exec.Maintenance.recover(spark, ref)
    assert(actions.exists(_.startsWith("restored")), actions)
    assert(spark.table(ref.render).as[(Long, String)].collect().toSeq
      == Seq((7L, "keep")))
  }

  test("versioned whole-table replace: location flip, no renames, GC, nesting") {
    withCommitter("versioned") {
      val ref = TableRef("default.swap_vtable")
      Seq((1L, "a")).toDF("id", "v").write.mode("overwrite")
        .saveAsTable(ref.render)
      // 1st replace: shell layout -> version dir
      AtomicWriter.overwriteTable(spark,
        spark.table(ref.render).withColumn("v", upper($"v")), ref)
      assert(spark.table(ref.render).as[(Long, String)].collect().toSeq
        == Seq((1L, "A")))
      val meta1 = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("default.swap_vtable"))
      assert(new org.apache.hadoop.fs.Path(meta1.location).toUri.getPath
        .contains(".graft_versions/"), s"location not flipped: ${meta1.location}")
      // 2nd replace: version dir -> version dir; old version GC'd
      AtomicWriter.overwriteTable(spark,
        spark.table(ref.render).withColumn("id", $"id" + 1), ref)
      assert(spark.table(ref.render).as[(Long, String)].collect().toSeq
        == Seq((2L, "A")))
      val shell = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.defaultTablePath(
          spark.sessionState.sqlParser.parseTableIdentifier(
            "default.swap_vtable")).toString))
      val vdirs = new java.io.File(shell, ".graft_versions").listFiles()
      assert(vdirs != null && vdirs.length == 1,
        s"replaced versions not GC'd: ${vdirs.mkString(",")}")
      assert(!shell.listFiles().exists(_.getName.startsWith(".graft_pending")),
        "pending manifest not cleared")
    }
  }

  test("versioned whole-table replace of a PARTITIONED table re-registers partitions") {
    withCommitter("versioned") {
      val part = PartitionSpec.Static(Seq("pt" -> "string"))
      val ref = TableRef("default.swap_vtablep")
      Materializer.table(spark, ref,
        Seq((1L, "p1"), (2L, "p2")).toDF("id", "pt"), part)
      // unpartitioned-style whole-table rewrite path (e.g. touched-cap
      // fallback) under the versioned committer
      AtomicWriter.overwriteTable(spark,
        Seq((10L, "p1"), (30L, "p3")).toDF("id", "pt"), ref, part)
      val got = spark.table(ref.render).select("id", "pt").as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      assert(got == Seq((10L, "p1"), (30L, "p3")))
      val parts = spark.sql(s"SHOW PARTITIONS ${ref.render}")
        .collect().map(_.getString(0)).sorted
      assert(parts.toSeq == Seq("pt=p1", "pt=p3"), parts.mkString(","))
      // partition-level commit AFTER the flip nests under the stable shell
      AtomicWriter.overwritePartitions(spark,
        Seq((11L, "p1")).toDF("id", "pt"), ref, part)
      assert(spark.table(ref.render).select("id").as[Long].collect().sorted
        .toSeq == Seq(11L, 30L))
    }
  }

  test("unpartitioned merge under the versioned committer is rename-free end-to-end") {
    withCommitter("versioned") {
      val ref = TableRef("default.swap_vmerge")
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("overwrite")
        .saveAsTable(ref.render)
      graft.exec.Incremental.merge(spark, ref,
        Seq((2L, "B"), (3L, "c")).toDF("id", "v"), uniqueKey = Seq("id"))
      assert(spark.table(ref.render).as[(Long, String)].collect().sortBy(_._1)
        .toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")))
      assert(!tables().exists(t => t.contains("graft_stg") || t.contains("graft_old")))
    }
  }

  test("recover sweeps a crashed (pre-flip) whole-table versioned write") {
    withCommitter("versioned") {
      val ref = TableRef("default.swap_vtcrash")
      Seq((5L, "keep")).toDF("id", "v").write.mode("overwrite")
        .saveAsTable(ref.render)
      val shell = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.defaultTablePath(
          spark.sessionState.sqlParser.parseTableIdentifier(
            "default.swap_vtcrash")).toString))
      val vdir = new java.io.File(shell, ".graft_versions/111_crash")
      assert(vdir.mkdirs())
      java.nio.file.Files.writeString(vdir.toPath.resolve("part-0.parquet"), "x")
      java.nio.file.Files.writeString(
        shell.toPath.resolve(".graft_pending_111_crash"), "")
      val actions = graft.exec.Maintenance.recover(spark, ref)
      assert(actions.exists(_.contains("orphan version dir")), actions)
      assert(!vdir.exists())
      assert(spark.table(ref.render).as[(Long, String)].collect().toSeq
        == Seq((5L, "keep")))
    }
  }

  test("versioned: schema-changing rebuild falls back to table recreation") {
    withCommitter("versioned") {
      val ref = TableRef("default.swap_vschema")
      Seq((1L, "a")).toDF("id", "v").write.mode("overwrite")
        .saveAsTable(ref.render)
      // added column => NOT same-shape => rename path recreates the table
      AtomicWriter.overwriteTable(spark,
        Seq((1L, "a", 9L)).toDF("id", "v", "extra"), ref)
      val got = spark.table(ref.render)
      assert(got.columns.toSeq == Seq("id", "v", "extra"))
      assert(got.as[(Long, String, Long)].collect().toSeq == Seq((1L, "a", 9L)))
    }
  }

  test("versioned: table() rebuild starts from a clean property slate") {
    withCommitter("versioned") {
      val ref = TableRef("default.swap_vprops")
      Materializer.table(spark, ref, Seq((1L, "a")).toDF("id", "v"),
        lifecycleDays = Some(30))
      // rebuild WITHOUT lifecycleDays: the stale property must not survive
      Materializer.table(spark, ref, Seq((1L, "a")).toDF("id", "v"))
      val props = spark.sql(s"SHOW TBLPROPERTIES ${ref.render}").collect()
        .map(_.getString(0))
      assert(!props.contains("graft.lifecycle.days"), props.mkString(","))
    }
  }

  test("recover completes a committed whole-table flip whose fix-up crashed") {
    withCommitter("versioned") {
      val part = PartitionSpec.Static(Seq("pt" -> "string"))
      val ref = TableRef("default.swap_vfinish")
      Materializer.table(spark, ref,
        Seq((1L, "p1"), (2L, "p2")).toDF("id", "pt"), part)
      // do a real flip so the root is a version dir
      AtomicWriter.overwriteTable(spark,
        Seq((10L, "p1"), (20L, "p2")).toDF("id", "pt"), ref, part)
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("default.swap_vfinish"))
      val rootPath = new org.apache.hadoop.fs.Path(meta.location).toUri.getPath
      assert(rootPath.contains(".graft_versions/"))
      // simulate the crash window: re-create the pending manifest for the
      // CURRENT root and drop one staged partition's registration
      val shell = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.defaultTablePath(
          spark.sessionState.sqlParser.parseTableIdentifier(
            "default.swap_vfinish")).toString))
      val stamp = rootPath.substring(rootPath.lastIndexOf('/') + 1)
      java.nio.file.Files.writeString(
        shell.toPath.resolve(s".graft_pending_$stamp"), "pt=p1\npt=p2")
      // metadata-only loss (retainData) — the crash window never purges
      // files, only leaves registrations unfinished
      spark.sessionState.catalog.dropPartitions(
        spark.sessionState.sqlParser.parseTableIdentifier("default.swap_vfinish"),
        Seq(Map("pt" -> "p1")), ignoreIfNotExists = true, purge = false,
        retainData = true)
      val actions = graft.exec.Maintenance.recover(spark, ref)
      assert(actions.exists(_.contains("completed committed whole-table flip")),
        actions)
      val got = spark.table(ref.render).select("id").as[Long].collect().sorted
      assert(got.toSeq == Seq(10L, 20L), "p1 registration not restored")
    }
  }

  test("recover sweeps pre-flip shell leftovers once the root is a version dir") {
    withCommitter("versioned") {
      val ref = TableRef("default.swap_vshellgc")
      Seq((1L, "a")).toDF("id", "v").write.mode("overwrite")
        .saveAsTable(ref.render)
      AtomicWriter.overwriteTable(spark,
        spark.table(ref.render).withColumn("v", upper($"v")), ref)
      val shell = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.defaultTablePath(
          spark.sessionState.sqlParser.parseTableIdentifier(
            "default.swap_vshellgc")).toString))
      // simulate an interrupted post-commit GC: stale pre-flip file at shell
      java.nio.file.Files.writeString(
        shell.toPath.resolve("part-stale.parquet"), "x")
      val actions = graft.exec.Maintenance.recover(spark, ref)
      assert(actions.exists(_.contains("pre-flip shell leftover")), actions)
      assert(!shell.toPath.resolve("part-stale.parquet").toFile.exists())
      assert(spark.table(ref.render).as[(Long, String)].collect().toSeq
        == Seq((1L, "A")))
    }
  }
}
