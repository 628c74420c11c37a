package graft.sources

import org.apache.spark.sql.SparkSession

/** HuggingFace object-store analog (reference
  * `crates/datafusion-app/src/extensions/huggingface.rs:41-99`: each
  * `[[execution.object_store.huggingface]]` entry builds an opendal
  * Huggingface operator and registers it for the url
  * `hf://{repo_id with '/' → '-'}`, so
  * `hf://huggingfacetb-finemath/file.parquet` scans a dataset file).
  *
  * The Spark analog splits the capability at the only seam this offline
  * environment can't cross:
  *
  *  - REAL: config parsing, the reference's authority rule
  *    (`org/repo` → `org-repo`), canonical resolve-URL construction
  *    (`https://huggingface.co/datasets/org/repo/resolve/rev/path` —
  *    the layout the HF hub serves), and a Hadoop [[HfFileSystem]]
  *    registered under the `hf://` scheme so DDL + scans plan through it
  *    like any other store.
  *  - STUBBED (documented, no egress): the HTTP transport. With
  *    `fs.hf.fixture.dir` set, resolved paths read from a local fixture
  *    tree laid out as `<fixture>/<authority>/<path>` — the same
  *    substitution shape as the s3a stub FileSystem (the reference
  *    tests S3 against localstack for the same reason). Without a
  *    fixture the filesystem fails loudly, naming the missing
  *    transport.
  */
object HfStore {

  final case class HfRepo(repoId: String, repoType: String = "model",
      revision: String = "main", root: String = "") {
    require(repoId.contains('/'), s"repo_id must be org/name, got $repoId")
  }

  /** The reference's URL-authority rule: '/' in repo_id becomes '-'. */
  def authority(repoId: String): String = repoId.replace('/', '-')

  /** Canonical HF hub resolve URL for a file in the repo — the address
    * the real transport would fetch (datasets/spaces prefix their type;
    * models live at the root, matching the hub's layout).
    */
  def resolveUrl(repo: HfRepo, path: String): String = {
    val prefix = repo.repoType match {
      case "dataset" | "datasets" => "datasets/"
      case "space" | "spaces" => "spaces/"
      case _ => ""
    }
    val rooted = Seq(repo.root.stripPrefix("/").stripSuffix("/"),
      path.stripPrefix("/")).filter(_.nonEmpty).mkString("/")
    s"https://huggingface.co/$prefix${repo.repoId}/resolve/${repo.revision}/$rooted"
  }

  private val Prefix = "execution.object_store.huggingface."

  private[sources] val registry =
    new java.util.concurrent.ConcurrentHashMap[String, HfRepo]()

  def repoFor(auth: String): Option[HfRepo] = Option(registry.get(auth))

  /** Register every `execution.object_store.huggingface.*` config entry
    * (flat keys for one repo, or `N.`-indexed keys for several — the
    * TOML-subset form of the reference's array of tables) and point the
    * `hf` scheme at [[HfFileSystem]]. Returns (authority, repo) pairs.
    */
  def apply(spark: SparkSession, conf: Map[String, String]): Seq[(String, HfRepo)] = {
    val entries = conf.collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }
    val grouped = entries.groupBy { case (k, _) =>
      // "0.repo_id" → group "0"; "repo_id" → group ""
      if (k.takeWhile(_ != '.').forall(_.isDigit) && k.contains('.'))
        k.takeWhile(_ != '.')
      else ""
    }
    val repos = grouped.toSeq.sortBy(_._1).flatMap { case (g, kvs) =>
      val m = kvs.map { case (k, v) =>
        (if (g.isEmpty) k else k.stripPrefix(s"$g.")) -> v }.toMap
      m.get("repo_id").map { id =>
        val repo = HfRepo(id,
          m.getOrElse("repo_type", "model"),
          m.getOrElse("revision", "main"),
          m.getOrElse("root", ""))
        authority(id) -> repo
      }
    }
    if (repos.nonEmpty) {
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.hf.impl", classOf[HfFileSystem].getName)
      hc.set("fs.hf.impl.disable.cache", "true")
      repos.foreach { case (auth, repo) => registry.put(auth, repo) }
    }
    repos
  }
}

/** Hadoop FileSystem for the `hf://` scheme: authority selects the
  * registered repo; the transport reads from the `fs.hf.fixture.dir`
  * local tree offline (see [[HfStore]] — the HTTP client is the one
  * stubbed seam).
  */
class HfFileSystem extends org.apache.hadoop.fs.FileSystem {
  import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, FSDataOutputStream, Path, RawLocalFileSystem}
  import org.apache.hadoop.util.Progressable

  private var myUri: java.net.URI = java.net.URI.create("hf:///")
  private val local = new RawLocalFileSystem()
  private var fixture: String = _
  private var wd: Path = _

  override def initialize(name: java.net.URI,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    myUri = java.net.URI.create(
      s"hf://${Option(name.getAuthority).getOrElse("")}")
    // absolutize at initialize time: RawLocalFileSystem absolutizes the
    // paths it returns, so a relative fixture dir would break fromLocal's
    // prefix-strip round trip
    fixture = Option(conf.get("fs.hf.fixture.dir"))
      .map(f => java.nio.file.Paths.get(f).toAbsolutePath.normalize.toString)
      .orNull
    local.initialize(java.net.URI.create("file:///"), conf)
    wd = new Path(myUri.toString + "/")
  }

  private def auth: String = Option(myUri.getAuthority).getOrElse("")

  /** Normalized local root this repo's files must stay under. */
  private def fixtureRoot: java.nio.file.Path =
    java.nio.file.Paths.get(fixture, auth).toAbsolutePath.normalize

  private def toLocal(p: Path): Path = {
    val repo = HfStore.repoFor(auth).getOrElse(
      throw new java.io.IOException(
        s"hf://$auth is not a registered huggingface repo (configure " +
          "execution.object_store.huggingface.repo_id)"))
    if (fixture == null)
      throw new java.io.IOException(
        s"no transport for ${HfStore.resolveUrl(repo, p.toUri.getPath)}: " +
          "the HTTP client is unavailable offline — set fs.hf.fixture.dir " +
          "to a local tree laid out as <fixture>/<authority>/<path>")
    // normalize '..' segments and refuse anything resolving outside
    // <fixture>/<authority> — a crafted hf:// path must not read the host
    // filesystem
    val root = fixtureRoot
    val candidate = root.resolve(p.toUri.getPath.stripPrefix("/")).normalize
    if (!candidate.startsWith(root))
      throw new java.io.IOException(
        s"$p escapes the hf fixture tree for authority '$auth'")
    new Path("file", null, candidate.toString)
  }
  private def fromLocal(p: Path): Path = {
    val rel = p.toUri.getPath.stripPrefix(fixtureRoot.toString)
    new Path("hf", auth, if (rel.isEmpty) "/" else rel)
  }
  private def translate(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      st.getPermission, st.getOwner, st.getGroup, fromLocal(st.getPath))

  override def getScheme: String = "hf"
  override def getUri: java.net.URI = myUri
  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    local.open(toLocal(f), bufferSize)
  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    throw new java.io.IOException("hf:// is a read-only store")
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new java.io.IOException("hf:// is a read-only store")
  override def rename(src: Path, dst: Path): Boolean =
    throw new java.io.IOException("hf:// is a read-only store")
  override def delete(f: Path, recursive: Boolean): Boolean =
    throw new java.io.IOException("hf:// is a read-only store")
  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(toLocal(f)).map(translate)
  override def setWorkingDirectory(dir: Path): Unit = { wd = dir }
  override def getWorkingDirectory: Path = wd
  override def mkdirs(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission): Boolean =
    throw new java.io.IOException("hf:// is a read-only store")
  override def getFileStatus(f: Path): FileStatus =
    translate(local.getFileStatus(toLocal(f)))
}
